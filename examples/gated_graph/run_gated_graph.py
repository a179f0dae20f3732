"""Graph classification with gated + mean pooling
(reference: examples/gated_graph)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import run_graph_conv_example  # noqa: E402

def main(argv=None):
    return run_graph_conv_example("gated", pool_name="mean", argv=argv)


if __name__ == "__main__":
    main()
