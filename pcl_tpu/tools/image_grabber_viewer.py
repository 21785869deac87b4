"""CLI: headless depth-image-sequence viewer
(reference: tools/image_grabber_viewer.cpp — ImageGrabber into a CloudViewer;
here: per-frame stats + optional HTML export of the first frame)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Replay depth images (headless)")
    ap.add_argument("dir", help="directory of .npy depth frames")
    ap.add_argument("-focal", type=float, default=525.0)
    ap.add_argument("-max_frames", type=int, default=30)
    ap.add_argument("-html", help="export the first frame here")
    args = ap.parse_args(argv)
    from pcl_tpu.io.grabber import ImageGrabber
    g = ImageGrabber(args.dir, focal=args.focal)
    n = 0
    for cloud in g.frames():
        if n >= args.max_frames:
            break
        print(f"[image_grabber_viewer] frame {n}: {int(cloud.count)} points "
              f"({cloud.width}x{cloud.height})")
        if n == 0 and args.html:
            from pcl_tpu.visualization.export import cloud_to_html
            cloud_to_html(args.html, cloud)
            print(f"[image_grabber_viewer] wrote {args.html}")
        n += 1
    print(f"[image_grabber_viewer] {n} frames")
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())
