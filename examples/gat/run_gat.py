"""gat example (reference: examples/gat/run_gat.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import run_conv_example  # noqa: E402

if __name__ == "__main__":
    run_conv_example("gat", flow_name="whole")
