"""Shim: the torch->flax weight converters are now part of the package —
puresound_tpu.utils.torch_import (the user-facing checkpoint-migration
API). The parity tests keep their historical `import torch_mapping`."""
from puresound_tpu.utils.torch_import import *  # noqa: F401,F403
from puresound_tpu.utils.torch_import import _a  # noqa: F401
