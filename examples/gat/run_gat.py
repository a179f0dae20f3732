"""gat example (reference: examples/gat/run_gat.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import run_conv_example  # noqa: E402

def main(argv=None):
    return run_conv_example("gat", flow_name="whole", argv=argv)


if __name__ == "__main__":
    main()
