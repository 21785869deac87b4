"""CLI: replay a depth-image sequence and save organized PCDs
(reference: tools/image_grabber_saver.cpp — drives an ImageGrabber over a
directory of depth frames and writes each as a PCD)."""
import argparse, os, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Depth image sequence -> PCD files")
    ap.add_argument("dir", help="directory of .npy depth frames (float meters)")
    ap.add_argument("out_dir")
    ap.add_argument("-focal", type=float, default=525.0)
    ap.add_argument("-max_frames", type=int, default=100)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.io.grabber import ImageGrabber
    os.makedirs(args.out_dir, exist_ok=True)
    g = ImageGrabber(args.dir, focal=args.focal)
    n = 0
    for cloud in g.frames():
        if n >= args.max_frames:
            break
        out = os.path.join(args.out_dir, f"frame_{n:06d}.pcd")
        io.save(out, cloud)
        print(f"[image_grabber_saver] {out} ({int(cloud.count)} points)")
        n += 1
    print(f"[image_grabber_saver] {n} frames saved")
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())
