"""Multi-device paths on the 8-device virtual CPU mesh.

The clean substitute for the reference's untestable NCCL paths
(SURVEY §4): sharded training must match single-device results, and the
implicit cross-replica SyncBN must actually synchronize.
"""

import numpy as np


def test_sharded_steps_match_single_device_subprocess():
    """The three heavy 8-device GSPMD equivalence checks (train step,
    SyncBN batch stats, eval step) run in a FRESH interpreter —
    tests/_sharded_child.py has the checks and the jaxlib-crash
    rationale (XLA:CPU compile of these executables aborts in
    long-lived suite processes; serialize() segfaults on cache writes).
    Coverage and tolerances are unchanged from the in-process versions
    that ran through round 4."""
    import os
    import subprocess
    import sys

    child = os.path.join(os.path.dirname(__file__), '_sharded_child.py')
    root = os.path.dirname(os.path.dirname(os.path.abspath(child)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    env.update(JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=8')
    if 'DODA_TEST_CCACHE' in os.environ:
        env['DODA_TEST_CCACHE'] = os.environ['DODA_TEST_CCACHE']
    proc = subprocess.run([sys.executable, child], env=env, cwd=root,
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True,
                          timeout=3000)
    assert proc.returncode == 0, f'sharded child failed:\n{proc.stdout}'
    for i in (1, 2, 3):
        assert f'sharded-child check {i} OK' in proc.stdout, proc.stdout


# ---------------------------------------------------------------------------
# multi-host seams (host-side; faked process group, no second process)
# ---------------------------------------------------------------------------

def test_all_gather_objects_single_process():
    from doda_tpu.parallel.collectives import all_gather_objects
    obj = {'a': [1, 2], 'b': np.arange(3)}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0]['a'] == [1, 2]


def test_init_from_launcher_pytorch_env(monkeypatch):
    from doda_tpu.parallel import collectives
    seen = {}

    def fake_init(coord, world, rank):
        seen.update(coord=coord, world=world, rank=rank)
        return rank, world
    monkeypatch.setattr(collectives, 'init_distributed', fake_init)
    monkeypatch.setenv('WORLD_SIZE', '4')
    monkeypatch.setenv('RANK', '2')
    monkeypatch.setenv('MASTER_ADDR', 'host0')
    rank, world = collectives.init_from_launcher('pytorch', tcp_port=12345)
    assert (rank, world) == (2, 4)
    assert seen == dict(coord='host0:12345', world=4, rank=2)
    # WORLD_SIZE=1 falls back to single-process without init
    monkeypatch.setenv('WORLD_SIZE', '1')
    seen.clear()
    assert collectives.init_from_launcher('pytorch') == (0, 1)
    assert not seen


def test_init_from_launcher_slurm_env(monkeypatch):
    from doda_tpu.parallel import collectives
    seen = {}

    def fake_init(coord, world, rank):
        seen.update(coord=coord, world=world, rank=rank)
        return rank, world
    monkeypatch.setattr(collectives, 'init_distributed', fake_init)
    monkeypatch.setenv('SLURM_NTASKS', '2')
    monkeypatch.setenv('SLURM_PROCID', '1')
    for nodelist, head in (('nd-[003-008]', 'nd-003'),
                           ('hostA,hostB', 'hostA'),
                           ('solo', 'solo')):
        monkeypatch.setenv('SLURM_STEP_NODELIST', nodelist)
        collectives.init_from_launcher('slurm', tcp_port=999)
        assert seen['coord'] == f'{head}:999', nodelist
    assert seen['world'] == 2 and seen['rank'] == 1


def test_update_split_sampler_merges_across_processes(monkeypatch):
    """tools/st.py must merge every rank's tail cuboids into the queue
    (ref tool/st.py:86-97 all_gather_object); fake a 2-process world."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__),
                                      '..', 'tools'))
    import st as st_cli

    class RecordingSampler:
        def __init__(self):
            self.updates, self.ratios = [], []

        def update(self, per_class):
            self.updates.append(per_class)

        def update_class_ratio(self, r):
            self.ratios.append(np.asarray(r))

    num_c = 2
    # rank0 (local) extras: 2 scenes x num_c interleaved tail splits
    extras = {'tar_tail_splits': [['a0'], ['b0'], ['a1'], ['b1']],
              'tar_splits_class_ratio': [np.array([1.0, 3.0])]}
    remote_per_class = [['ra'], ['rb']]
    remote_ratio = np.array([2.0, 1.0])

    monkeypatch.setattr(st_cli.jax, 'process_count', lambda: 2)
    monkeypatch.setattr(
        st_cli, 'all_gather_objects',
        lambda obj: [obj, (remote_per_class, remote_ratio)])

    samp = RecordingSampler()
    st_cli.update_split_sampler(samp, extras, num_c, update_ratio=True)
    assert samp.updates == [[['a0', 'a1', 'ra'], ['b0', 'b1', 'rb']]]
    np.testing.assert_allclose(samp.ratios[0], [3.0, 4.0])

    # update_ratio=False leaves the EMA untouched but still merges queues
    samp2 = RecordingSampler()
    st_cli.update_split_sampler(samp2, extras, num_c, update_ratio=False)
    assert samp2.updates and not samp2.ratios


def test_real_two_process_rendezvous():
    """Execute init_distributed for REAL: two fresh CPU processes
    rendezvous through jax.distributed.initialize (gloo collectives) via
    init_from_launcher's pytorch env path, then round-trip per-rank
    payloads through all_gather_objects — no monkeypatching anywhere
    (ref launcher seam: util/common_utils.py:86-126; queue sync:
    tool/st.py:86-89)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:        # pick a free rendezvous port
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    child = os.path.join(os.path.dirname(__file__), '_rendezvous_child.py')
    root = os.path.dirname(os.path.dirname(os.path.abspath(child)))
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(('JAX_', 'XLA_'))}
        env.update(JAX_PLATFORMS='cpu', RANK=str(rank), WORLD_SIZE='2',
                   MASTER_ADDR='127.0.0.1', DODA_TEST_PORT=str(port))
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}'
        assert f'rendezvous child rank={rank}/2 OK' in out, out
