"""L3/L4 algorithms and codec pipelines (SURVEY.md §1)."""

from .amp import amp_decode, AmpResult  # noqa: F401
from .sparc import SparcModel  # noqa: F401
