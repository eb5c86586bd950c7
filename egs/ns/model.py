"""NS recipe model zoo — thin re-export of the framework zoo
(puresound_tpu.zoo.ns), kept at the recipe level for parity with the
reference layout (egs/ns/model.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from puresound_tpu.zoo.ns import init_loss, init_model  # noqa: F401,E402
