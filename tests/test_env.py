"""Env-var configuration layer — candidate filtering with ^ exclusion and
range clamps (docs/env_vars.rst analog)."""

import os

import jax
import pytest

from cudecomp_tpu.config import TransposeMethod
from cudecomp_tpu.utils import env as E


def test_filter_include():
    os.environ["X_TEST_METHODS"] = "ring"
    try:
        vals = E.filter_candidates("X_TEST_METHODS",
                                   (TransposeMethod.ALL_TO_ALL,
                                    TransposeMethod.RING))
        assert vals == [TransposeMethod.RING]
    finally:
        del os.environ["X_TEST_METHODS"]


def test_filter_exclude():
    os.environ["X_TEST_METHODS"] = "^ring"
    try:
        vals = E.filter_candidates("X_TEST_METHODS",
                                   (TransposeMethod.ALL_TO_ALL,
                                    TransposeMethod.RING))
        assert vals == [TransposeMethod.ALL_TO_ALL]
    finally:
        del os.environ["X_TEST_METHODS"]


def test_filter_all_excluded_falls_back():
    os.environ["X_TEST_METHODS"] = "^ring,^all_to_all"
    try:
        vals = E.filter_candidates("X_TEST_METHODS",
                                   (TransposeMethod.ALL_TO_ALL,
                                    TransposeMethod.RING))
        assert len(vals) == 2  # warns and ignores the filter
    finally:
        del os.environ["X_TEST_METHODS"]


def test_int_range():
    os.environ["X_TEST_RANGE"] = "2,4"
    try:
        assert E.int_range("X_TEST_RANGE") == (2, 4)
    finally:
        del os.environ["X_TEST_RANGE"]
    assert E.int_range("X_TEST_RANGE_UNSET") is None


def test_autotune_env_method_filter():
    os.environ["CUDECOMP_TPU_AUTOTUNE_TRANSPOSE_METHODS"] = "all_to_all"
    try:
        import cudecomp_tpu as cd
        from cudecomp_tpu.autotune import autotune
        cfg = cd.GridConfig(gdims=(16, 16, 16))
        opts = cd.AutotuneOptions(n_warmup=0, n_trials=1)
        result = autotune(cfg, devices=jax.devices()[:4], options=opts)
        assert {t.method for t in result.trials} == {"all_to_all"}
    finally:
        del os.environ["CUDECOMP_TPU_AUTOTUNE_TRANSPOSE_METHODS"]


def test_autotune_env_range_clamp():
    os.environ["CUDECOMP_TPU_AUTOTUNE_P_ROW_RANGE"] = "2,2"
    try:
        import cudecomp_tpu as cd
        from cudecomp_tpu.autotune import _valid_pdims
        cfg = cd.GridConfig(gdims=(64, 64, 64))
        assert _valid_pdims(cfg, 8, cd.AutotuneOptions()) == [(2, 4)]
    finally:
        del os.environ["CUDECOMP_TPU_AUTOTUNE_P_ROW_RANGE"]
