"""CLI: headless PCD-sequence grabber viewer
(reference: tools/pcd_grabber_viewer.cpp — replays a directory of PCDs
through the grabber at a given fps into a CloudViewer; here: prints per-frame
stats + measured frame rate, optional HTML of the last frame)."""
import argparse, sys, time


def main(argv=None):
    ap = argparse.ArgumentParser(description="Replay PCD files via the grabber")
    ap.add_argument("path", help="PCD file, directory of PCDs, or glob")
    ap.add_argument("-fps", type=float, default=0.0)
    ap.add_argument("-repeat", action="store_true")
    ap.add_argument("-max_frames", type=int, default=30)
    ap.add_argument("-html", help="export the last frame here")
    args = ap.parse_args(argv)
    from pcl_tpu.io.grabber import PCDGrabber
    from pcl_tpu.utils.timing import EventFrequency
    freq = EventFrequency()
    frames = []

    def on_cloud(cloud):
        freq.event()
        frames.append(cloud)
        print(f"[pcd_grabber_viewer] frame {len(frames)}: "
              f"{int(cloud.count)} points")

    g = PCDGrabber(args.path, fps=args.fps, repeat=args.repeat)
    g.register_callback(on_cloud)
    g.start()
    t0 = time.perf_counter()
    while g.is_running() and len(frames) < args.max_frames \
            and time.perf_counter() - t0 < 10.0:
        time.sleep(0.005)
    g.stop()
    print(f"[pcd_grabber_viewer] {len(frames)} frames, "
          f"{freq.frequency():.1f} fps")
    if args.html and frames:
        from pcl_tpu.visualization.export import cloud_to_html
        cloud_to_html(args.html, frames[-1])
        print(f"[pcd_grabber_viewer] wrote {args.html}")
    return 0 if frames else 1


if __name__ == "__main__":
    sys.exit(main())
