"""Cross-table lookup e2e: two tables sharing a column multiset
(reference: starky/src/cross_table_lookup.rs)."""

import numpy as np
import pytest

from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.cross_table_lookup import (
    CrossTableLookup, TableWithColumns, check_ctls,
)
from plonky2_tpu.starky.lookup import Column
from plonky2_tpu.starky.prover import prove_multi
from plonky2_tpu.starky.stark import Stark
from plonky2_tpu.starky.verifier import verify_multi


class SharedColumnStark(Stark):
    """One unconstrained column; the CTL is the whole statement."""
    COLUMNS = 1
    PUBLIC_INPUTS = 0

    def constraint_degree(self):
        # CTL transition constraint combine*(z-z')*z_last is degree 3
        return 3

    def requires_ctls(self):
        return True

    def eval(self, alg, frame, consumer):
        pass


CTLS = [CrossTableLookup(
    looking_tables=(TableWithColumns(0, (Column.single(0),)),),
    looked_table=TableWithColumns(1, (Column.single(0),)),
)]


def _traces(n):
    t0 = np.asarray([[(5 + i) for i in range(n)]], dtype=np.uint64)
    t1 = np.roll(t0, 3, axis=1).copy()   # a permutation of t0
    return t0, t1


def test_check_ctls_debug_helper():
    t0, t1 = _traces(16)
    check_ctls([t0, t1], CTLS)
    bad = t1.copy()
    bad[0][0] = 999
    with pytest.raises(AssertionError):
        check_ctls([t0, bad], CTLS)


def test_ctl_two_tables_prove_verify():
    n = 1 << 5
    config = StarkConfig.standard_fast_config()
    starks = [SharedColumnStark(), SharedColumnStark()]
    t0, t1 = _traces(n)
    mp = prove_multi(starks, config, [t0, t1], CTLS, [[], []])
    verify_multi(starks, mp, config, CTLS)


def test_ctl_rejects_multiset_mismatch():
    n = 1 << 5
    config = StarkConfig.standard_fast_config()
    starks = [SharedColumnStark(), SharedColumnStark()]
    t0, t1 = _traces(n)
    t1[0][0] = 999
    with pytest.raises(AssertionError):
        mp = prove_multi(starks, config, [t0, t1], CTLS, [[], []])
        verify_multi(starks, mp, config, CTLS)
