import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from run_transX import main  # noqa: E402

if __name__ == "__main__":
    main("transh")
