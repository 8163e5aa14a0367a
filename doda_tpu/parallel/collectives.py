"""Mesh + collective helpers — the framework's single distributed seam.

The reference inlines ~20 ``torch.distributed`` calls (NCCL allreduce/
all_gather/barrier, pad-to-max tensor gather, pickle-object gather;
ref: util/common_utils.py:86-126,341-461). Here the training steps are
GSPMD programs, so *inside jit* nothing in this module is needed — shard
the batch and XLA inserts psums. These helpers cover the host-side
orchestration that remains:

* building the device mesh / process init (multi-host),
* replicating state and sharding batches,
* host-level gathers for objects like the cuboid queue (which the
  reference moves as pickled bytes over NCCL, tool/st.py:86-89).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host init (the ``--launcher`` equivalent,
    ref util/common_utils.py:86-126). No-op for single-host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def init_from_launcher(launcher: str, tcp_port: int = 18867, logger=None):
    """CLI ``--launcher`` seam: read the launcher's rendezvous env and
    initialize the JAX process group (ref util/common_utils.py:86-126,
    init_dist_pytorch / init_dist_slurm).

    ``pytorch``: torchrun/torch.distributed.launch env — RANK,
    WORLD_SIZE, MASTER_ADDR (coordinator = MASTER_ADDR:tcp_port, like
    the reference's tcp:// init_method).
    ``slurm``: SLURM_PROCID / SLURM_NTASKS, coordinator = first host of
    SLURM_STEP_NODELIST (ref uses scontrol show hostname; here the
    common "host1,host2" / "prefix[a-b,...]" forms are parsed inline).
    ``none``: single-process, no init.

    Returns (rank, world_size). Must run before any other JAX backend
    use in the process.
    """
    import os
    import re

    def _warn(msg):
        if logger is not None:
            logger.warning(msg)
        else:
            import logging
            logging.getLogger('doda_tpu').warning(msg)

    if launcher == 'none' or not launcher:
        return 0, 1
    if launcher == 'pytorch':
        world = int(os.environ.get('WORLD_SIZE', '1'))
        if world <= 1:
            _warn('--launcher pytorch with WORLD_SIZE<=1; '
                  'running single-process')
            return 0, 1
        rank = int(os.environ['RANK'])
        coord = f"{os.environ['MASTER_ADDR']}:{tcp_port}"
    elif launcher == 'slurm':
        world = int(os.environ.get('SLURM_NTASKS', '1'))
        if world <= 1:
            _warn('--launcher slurm with SLURM_NTASKS<=1; '
                  'running single-process')
            return 0, 1
        rank = int(os.environ['SLURM_PROCID'])
        nodelist = os.environ.get('SLURM_STEP_NODELIST',
                                  os.environ.get('SLURM_NODELIST', ''))
        # "h1,h2" or "prefix[001-004,007]" -> first hostname
        m = re.match(r'([^\[,]+)(?:\[([^\]\-,]+))?', nodelist)
        head = m.group(1) + (m.group(2) or '') if m else nodelist
        coord = f'{head}:{tcp_port}'
    else:
        raise ValueError(f'unknown launcher {launcher!r}')
    return init_distributed(coord, world, rank)


def make_mesh(n_devices=None, axis='data'):
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(mesh: Mesh, batch, axis='data'):
    """Put a PointBatch (or any pytree of arrays with a leading batch
    dim) onto the mesh, sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate train state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, 'shape') else x,
        tree)


def all_gather_objects(obj):
    """Gather a picklable object from every process (host-level; the
    queue-sync path, ref util/common_utils.py:390-446). Single-process
    returns [obj]."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    import pickle
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # pad to the max size across hosts
    n = np.array([payload.size], np.int32)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[:payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(jax.process_count())]
