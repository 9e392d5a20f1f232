"""KernelKey: the typed replacement for the C function-name grammar.

``parasail_name()`` must render exactly the strings the reference
composes (src/aligner/mod.rs:289-331) so parity is checkable in logs.
"""

import pytest

from parasail_rs_tpu.errors import UnknownKernel
from parasail_rs_tpu.ops.specs import KernelKey


def test_name_grammar_rendering():
    cases = [
        (KernelKey(), "nw_striped_sat"),
        (KernelKey(mode="sw", outputs="trace", strategy="diag", width="16"),
         "sw_trace_diag_16"),
        (KernelKey(mode="sg", free=(True, True, True, True)),
         "sg_striped_sat"),   # _qx_dx normalises away
        (KernelKey(mode="sg", free=(True, False, False, True),
                   outputs="stats", strategy="scan", width="8"),
         "sg_qb_de_stats_scan_8"),
        (KernelKey(mode="sg", free=(False, True, True, True),
                   outputs="stats_table", width="32"),
         "sg_qe_dx_stats_table_striped_32"),
        (KernelKey(mode="nw", outputs="rowcol", profile=True, width="64"),
         "nw_rowcol_striped_profile_64"),
        (KernelKey(mode="sw", outputs="stats_rowcol", strategy="scan"),
         "sw_stats_rowcol_scan_sat"),
    ]
    for key, name in cases:
        assert key.parasail_name() == name, key


def test_invalid_combinations_raise():
    with pytest.raises(UnknownKernel):
        KernelKey(mode="xx")
    with pytest.raises(UnknownKernel):
        KernelKey(outputs="everything")
    with pytest.raises(UnknownKernel):
        KernelKey(width="128")
    with pytest.raises(UnknownKernel):
        KernelKey(strategy="blocked")
    with pytest.raises(UnknownKernel):
        # profile requires striped or scan (reference assert,
        # src/aligner/mod.rs:307-310)
        KernelKey(profile=True, strategy="diag")
