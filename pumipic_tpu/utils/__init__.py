from pumipic_tpu.utils import plog, timing, types  # noqa: F401
from pumipic_tpu.utils.types import LID_DTYPE, GID_DTYPE, REAL_DTYPE  # noqa: F401
