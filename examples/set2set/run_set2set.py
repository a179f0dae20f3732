"""Graph classification with gin + set2set pooling
(reference: examples/set2set)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import run_graph_conv_example  # noqa: E402

def main(argv=None):
    return run_graph_conv_example("gin", pool_name="set2set", argv=argv)


if __name__ == "__main__":
    main()
