"""CLI: replay a Velodyne pcap into per-sweep PCDs (reference:
tools/hdl_grabber_example.cpp + openni_pcd_recorder pattern, headless)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Velodyne pcap -> PCD sweeps")
    ap.add_argument("input", help=".pcap file")
    ap.add_argument("out_prefix", help="writes <prefix>_NNN.pcd per sweep")
    ap.add_argument("-model", default="VLP16")
    ap.add_argument("-max_sweeps", type=int, default=0, help="0 = all")
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.io.velodyne import PcapVelodyneGrabber
    g = PcapVelodyneGrabber(args.input, model=args.model)
    count = 0
    for cloud in g._produce():      # synchronous replay (no worker thread)
        io.save(f"{args.out_prefix}_{count:03d}.pcd", cloud)
        count += 1
        if args.max_sweeps and count >= args.max_sweeps:
            break
    print(f"[pcap_to_pcd] {count} sweeps written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
