"""appnp example (reference: examples/appnp/run_appnp.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import run_conv_example  # noqa: E402

if __name__ == "__main__":
    run_conv_example("appnp", flow_name="whole")
