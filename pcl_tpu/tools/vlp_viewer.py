"""CLI: headless VLP-16 pcap viewer (reference: tools/vlp_viewer.cpp —
the VLP-16 counterpart of hdl_viewer_simple)."""
import sys

from pcl_tpu.tools.hdl_viewer_simple import main as _main


def main(argv=None):
    return _main(argv, model="VLP16", tag="vlp_viewer")


if __name__ == "__main__":
    sys.exit(main())
