"""Summarize a jax.profiler xplane trace: top ops by device time.

Usage: python tools/xplane_summary.py /tmp/trace1 [top_n]

Reads the newest .xplane.pb under the trace dir and aggregates XLA-op
durations on the device's sync 'XLA Ops' line ONLY — the async lines
('Async XLA Ops': DMA copy-/slice-start events) overlap the sync
timeline and double-count wall time (a copy-start's duration spans
until its done; summing them reported 2.4 s of "copies" on a 0.93 s
step). Buckets group ops into the categories the PERF.md tables use.
Used to attribute step time (PERF.md methodology).
"""
import collections
import glob
import os
import re
import sys


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f'no .xplane.pb under {trace_dir}')
    xs = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())
    return xs


def bucket(nm):
    """Coarse attribution buckets. Fusion kinds are named by XLA after
    their root op, so gather/GEMM fusions need the operand signature."""
    n = nm.lower()
    if 'sort' in n:
        return 'sorts'
    if 'dynamic-update-slice' in n:
        return 'DUS (concat emission / .at[].set)'
    if re.match(r'%(copy|reshape|transpose|bitcast)[.\d]* =', n):
        return 'copies / relayout'
    if 'reduce-window' in n or 'reduce' in n:
        return 'reduces'
    if re.match(r'%fusion', n):
        # gather fusions: bf16/f32/pred table + s32 index operands with
        # result shape == table shape; GEMM fusions: two bf16 operands
        # of different shapes
        shapes = re.findall(r'([a-z0-9]+)\[([0-9,]*)\]\{', nm)
        if len(shapes) >= 2 and any(t == 's32' for t, _ in shapes[1:]) \
                and shapes[0][0] in ('bf16', 'f32', 'pred'):
            return 'gather fusions'
        if sum(1 for t, _ in shapes[1:] if t == 'bf16') >= 2:
            return 'GEMM fusions'
        return 'other fusions'
    if 'select' in n or 'maximum' in n or 'broadcast' in n or 'pad' in n:
        return 'elemwise (mask/relu/pad)'
    if 'concatenate' in n:
        return 'concat'
    return 'misc'


def summarize(trace_dir, top_n=40):
    xs = load_xspace(trace_dir)
    op_tot = collections.Counter()
    op_cnt = collections.Counter()
    buck = collections.Counter()
    module_ms = 0.0
    n_events = 0
    for plane in xs.planes:
        name = plane.name
        if 'TPU' not in name and 'GPU' not in name and 'Device' not in name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == 'XLA Modules':
                module_ms = max(module_ms, sum(
                    ev.duration_ps for ev in line.events) / 1e9)
            if line.name != 'XLA Ops':
                continue
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, '?')
                if nm.startswith('jit_'):
                    continue
                dur = ev.duration_ps / 1e9  # ms
                op_tot[nm] += dur
                op_cnt[nm] += 1
                buck[bucket(nm)] += dur
                n_events += 1
    print(f'== module: {module_ms:.1f} ms, {n_events} sync op events '
          f'({module_ms * 1e3 / max(n_events, 1):.1f} us/event avg) ==')
    print('== buckets (ms) ==')
    for k, v in buck.most_common():
        print(f'  {v:9.1f}  {k}')
    print(f'== top {top_n} ops (ms) ==')
    for nm, ms in op_tot.most_common(top_n):
        print(f'  {ms:8.2f} x{op_cnt[nm]:<4d} {nm[:160]}')


if __name__ == '__main__':
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
