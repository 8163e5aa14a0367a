"""Test config: force an 8-device CPU mesh before JAX initializes.

This is the clean substitute for multi-device testing that the reference
lacks entirely (SURVEY.md §4) — all collective/sharding paths run on
8 virtual CPU devices.
"""

import os

# Force CPU even when the session env preselects a TPU platform (the env
# var alone is not honored by out-of-tree platform plugins; the config
# update below is). Set DODA_TEST_TPU=1 to run the suite on real hardware.
if not os.environ.get('DODA_TEST_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

if not os.environ.get('DODA_TEST_TPU'):
    jax.config.update('jax_platforms', 'cpu')

# Persistent XLA compile cache: the suite's wall-clock is dominated by
# XLA:CPU compiles of train/eval steps (the tiny 3-level train step alone
# is ~7 min on a 1-core host). Identical jit graphs recur across tests
# and across suite runs; the cache turns every repeat into a ~1 s load.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('DODA_TEST_CCACHE', '/tmp/doda_test_ccache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
