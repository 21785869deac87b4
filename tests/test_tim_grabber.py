"""SICK TiM telegram parsing — mirrors reference
test/io/test_tim_grabber.cpp (TimGrabberTest.Test1): random scans
encoded as `sRA LMDscandata` telegrams must decode to the generating
distances projected onto the TiM fan (angle_start -pi/4, range 3pi/2).
"""

import numpy as np

from pcl_tpu.io.tim import parse_tim_packet, load_tim_log, TimGrabber

HEADER = ("sRA LMDscandata 1 1 1291B11 0 0 AED5 AED7 FDB36397 FDB3779F "
          "0 0 1 0 0 5DC A2 0 1 DIST1 3F800000 00000000 FFF92230 D05")


def _make_packet(rng, n):
    dist = rng.uniform(0.0, 20.0, n)
    mm = (dist * 1000).astype(np.int64)
    body = " ".join(f"{v:x}" for v in [n] + mm.tolist())
    # expected from the integer mm values (the telegram truncates to mm)
    d = mm.astype(np.float64) / 1000.0
    ang = -np.pi / 4 + np.arange(n) * (2.0 * np.pi * 3.0 / 4.0 / max(n, 1))
    exp = np.stack([d * np.cos(ang), d * np.sin(ang), np.zeros(n)], 1)
    return HEADER + " " + body, exp.astype(np.float32)


def test_parse_random_scans():
    rng = np.random.default_rng(11)
    for _ in range(50):
        n = int(rng.integers(0, 1000))
        pkt, exp = _make_packet(rng, n)
        pts = parse_tim_packet(pkt)
        assert pts.shape == (n, 3)
        np.testing.assert_allclose(pts, exp, atol=1e-4)


def test_log_replay(tmp_path):
    rng = np.random.default_rng(5)
    pkts, exps = zip(*[_make_packet(rng, int(rng.integers(1, 50)))
                       for _ in range(4)])
    p = tmp_path / "scan.log"
    p.write_text("\x02" + "\x03\x02".join(pkts) + "\x03")
    scans = load_tim_log(str(p))
    assert len(scans) == 4
    for s, e in zip(scans, exps):
        np.testing.assert_allclose(s, e, atol=1e-4)

    got = []
    g = TimGrabber(str(p))
    g.register_callback(lambda c: got.append(c))
    g.start()
    import time
    for _ in range(100):
        if len(got) == 4:
            break
        time.sleep(0.05)
    g.stop()
    assert len(got) == 4
