"""Script-side alias for the library's fenced timing helper.

See gsplat_tpu/utils/profiling.py for why timing must fence with a
device->host fetch on this backend.
"""

from gsplat_tpu.utils.profiling import timed  # noqa: F401
