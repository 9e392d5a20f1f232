"""Batch scheduling: length-binned dispatch for dense device tiles."""

from .scheduler import Bin, plan_bins

__all__ = ["Bin", "plan_bins"]
