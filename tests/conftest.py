"""Test configuration: force JAX onto a virtual 8-device CPU platform so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# f64 off (default), but make torch comparisons deterministic
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# Hermetic tests: CLI entry points default --compilation_cache_dir to
# ~/.cache/vqatpu/xla (validate_args enables it) — don't let test runs
# share persistent state with the user cache.  Tests that exercise the
# cache pass an explicit tmp dir.
os.environ["VQATPU_COMPILATION_CACHE"] = ""

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — override it back to CPU here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1204)  # reference seed (FFOE/main.py:53)
