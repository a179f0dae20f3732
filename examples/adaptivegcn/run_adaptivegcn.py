"""adaptive (layerwise) GCN (reference: examples/adaptivegcn/run_adaptivegcn.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import run_conv_example  # noqa: E402

def main(argv=None):
    return run_conv_example("gcn", flow_name="layerwise", argv=argv)


if __name__ == "__main__":
    main()
