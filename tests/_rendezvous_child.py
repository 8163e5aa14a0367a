"""Child process for test_distributed.py::test_real_two_process_rendezvous.

Run with pytorch-launcher env (RANK, WORLD_SIZE, MASTER_ADDR) plus
DODA_TEST_PORT. Executes the REAL multi-process seam — no monkeypatching:
``init_from_launcher`` -> ``jax.distributed.initialize`` (gloo CPU
collectives) -> ``all_gather_objects`` round trip (the ST cuboid-queue
sync path, ref util/common_utils.py:390-446, tool/st.py:86-89).
"""

import os
import sys

# Fresh interpreter: force the CPU backend before JAX initializes (the
# axon TPU plugin ignores a post-import JAX_PLATFORMS; in a child that
# sets it pre-import this is honored, and the config update makes sure).
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doda_tpu.parallel.collectives import (  # noqa: E402
    all_gather_objects, init_from_launcher)


def main():
    port = int(os.environ['DODA_TEST_PORT'])
    want_rank = int(os.environ['RANK'])
    want_world = int(os.environ['WORLD_SIZE'])

    rank, world = init_from_launcher('pytorch', tcp_port=port)
    assert rank == want_rank, (rank, want_rank)
    assert world == want_world, (world, want_world)
    assert jax.process_count() == want_world, jax.process_count()
    assert jax.process_index() == want_rank

    # per-rank payloads of DIFFERENT pickled sizes: exercises the
    # pad-to-max + size-trim path in all_gather_objects
    payload = {'rank': rank, 'cuboids': list(range(10 * (rank + 1))),
               'tag': 'r%d' % rank * (rank + 1)}
    gathered = all_gather_objects(payload)
    assert len(gathered) == want_world, len(gathered)
    for r, got in enumerate(gathered):
        assert got['rank'] == r, gathered
        assert got['cuboids'] == list(range(10 * (r + 1))), gathered

    # a cross-process device collective: global-device sum over one
    # array shard per process (the GSPMD metric-psum story, minimal)
    import numpy as np
    from jax.experimental import multihost_utils
    total = multihost_utils.process_allgather(
        np.array([rank + 1], np.int32)).sum()
    assert int(total) == want_world * (want_world + 1) // 2, total

    print(f'rendezvous child rank={rank}/{world} OK', flush=True)


if __name__ == '__main__':
    main()
