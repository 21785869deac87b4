"""CLI: HDL grabber callback example (reference: tools/hdl_grabber_example.cpp
— registers a sweep callback on the HDL grabber and prints per-sweep counts
via the Grabber signal machinery, exercising start/stop/registerCallback)."""
import argparse, sys, time


def main(argv=None):
    ap = argparse.ArgumentParser(description="HDL grabber callback example")
    ap.add_argument("pcap")
    ap.add_argument("-model", default="HDL32E", choices=["HDL32E", "VLP16"])
    ap.add_argument("-timeout", type=float, default=5.0)
    args = ap.parse_args(argv)
    from pcl_tpu.io.velodyne import PcapVelodyneGrabber
    got = []

    def on_sweep(cloud):
        got.append(int(cloud.count))
        print(f"[hdl_grabber_example] sweep {len(got)}: {int(cloud.count)} points")

    g = PcapVelodyneGrabber(args.pcap, model=args.model)
    g.register_callback(on_sweep)
    g.start()
    t0 = time.perf_counter()
    while g.is_running() and time.perf_counter() - t0 < args.timeout:
        time.sleep(0.01)
    g.stop()
    print(f"[hdl_grabber_example] {len(got)} sweeps total")
    return 0 if got else 1


if __name__ == "__main__":
    sys.exit(main())
