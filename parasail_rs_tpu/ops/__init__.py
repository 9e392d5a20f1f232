"""Device kernels: batched wavefront DP fill (XLA + Pallas paths)."""

from .specs import MODES, OUTPUTS, STRATEGIES, WIDTHS, KernelKey
from .scan_kernel import scan_fits, scan_score_align
from .wavefront import wavefront_align

__all__ = [
    "KernelKey",
    "MODES",
    "OUTPUTS",
    "STRATEGIES",
    "WIDTHS",
    "wavefront_align",
    "scan_fits",
    "scan_score_align",
]
