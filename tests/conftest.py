"""Test configuration: force JAX onto a virtual 8-device CPU platform so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call" not in flags:
    # XLA CPU in-process collectives abort the WHOLE process (exit()) when a
    # rendezvous participant is starved past a hard 40 s default — on this
    # 1-core host plain scheduler load can do that to the 8-virtual-device
    # mesh tests and kill the pytest run (the same abort that redded the r4
    # driver artifact, see __graft_entry__.dryrun_multichip).  Raise it so a
    # starved device thread just runs late.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60")
os.environ["XLA_FLAGS"] = flags
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
