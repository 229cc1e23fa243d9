"""Driver entry points stay green: dryrun_multichip on the test CPU mesh."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_8():
    """shard_map DP + GSPMD 2-D mesh train steps compile and run on the
    virtual 8-device mesh (the driver's multi-chip validation path)."""
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_returns_jittable(monkeypatch):
    """entry() builds; full 128² compile is covered by the driver itself —
    here we only check the contract (callable + example args align)."""
    fn, args = __graft_entry__.entry()
    assert callable(fn)
    params, seq, src, tgt = args
    assert seq.shape[2] == seq.shape[3] == 128
    assert src.shape[:2] == seq.shape[:2]
    assert tgt.shape[0] == seq.shape[0]
