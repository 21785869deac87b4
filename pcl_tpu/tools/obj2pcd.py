"""CLI: obj2pcd converter (reference: tools/obj2pcd.cpp) — delegates to the
extension-dispatching converter (io.load/io.save handle both ends)."""
import sys

from pcl_tpu.tools.convert import main as _convert_main


def main(argv=None):
    return _convert_main(argv)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
