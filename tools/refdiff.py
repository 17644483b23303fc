#!/usr/bin/env python3
# -*- coding: UTF-8 -*-
"""Differential-parity case generator (VERDICT r8 item 2).

Runs the ACTUAL reference split/fold code — PreProcessTransfer._cut_data_index
(/root/reference/DFW/preprocess.py:155-193) — over a seeded random grid of
(size, train_setting, cv) configs and dumps each result as one JSON line to
src/test/resources/refdiff/cases.jsonl.gz. graft.dfw.RefDiffSpec replays the
same grid through SplitOps and compares index-for-index, converting the
hand-derived W2/W3/W4 unit fixtures into machine-checked equivalence with the
executable reference.

Environment shims (semantics-preserving, documented):
  * collections.Iterable moved to collections.abc in py3.10 — aliased back.
  * h5py / scipy.io are imported by DFW.tools for .mat loading, which this
    harness never touches — stubbed with empty modules.
  * np.array over ragged fold groups (train_size % cv != 0) produced an
    object array before numpy 1.24 and raises ValueError on the installed
    1.26; the wrapper retries with dtype=object, which restores exactly the
    pre-1.24 behavior the reference was written against (boolean masking and
    np.concatenate over object arrays are unchanged).

Reference crashes (e.g. cv=1, whose linspace branch hits np.concatenate over
zero arrays) are recorded as ref_error lines: the engine has no parity
obligation for configs the reference itself cannot execute.

Fold index lists are stored SORTED: the reference's rotation branch emits its
train indices in deque-rotated order, an artifact of its imperative gather;
the engine is relational (row order is carried by explicit rank columns), so
parity is on index SETS per (fold, role).

Usage: python3 tools/refdiff.py [n_cases] [seed]
"""
import gzip
import json
import os
import random
import sys
import types

import numpy as np

# --- environment shims (see module docstring) ---
import collections
import collections.abc
if not hasattr(collections, 'Iterable'):
    collections.Iterable = collections.abc.Iterable
for mod in ('h5py', 'scipy', 'scipy.io'):
    if mod not in sys.modules:
        sys.modules[mod] = types.ModuleType(mod)
sys.modules['scipy'].io = sys.modules['scipy.io']

sys.path.insert(0, '/root/reference')
from DFW import preprocess  # noqa: E402

_np_array = np.array


def _compat_array(*args, **kwargs):
    try:
        return _np_array(*args, **kwargs)
    except ValueError:
        if 'dtype' not in kwargs:
            return _np_array(*args, dtype=object, **kwargs)
        raise


preprocess.np.array = _compat_array

CUT = preprocess.PreProcessTransfer._cut_data_index


def gen_case(rng, big):
    if big:
        size = rng.randint(1000, 5000)
    else:
        # bias toward small sizes: every clamp/rotation branch lives there
        size = rng.choice([rng.randint(1, 20), rng.randint(1, 60), rng.randint(21, 300)])
    cv = rng.randint(1, 8)
    kind = rng.choice(['all', 'frac', 'int'])
    if kind == 'all':
        train = -1
    elif kind == 'frac':
        train = round(rng.uniform(0.001, 0.999), 6)
    else:
        train = rng.randint(1, size + 10)
    return size, cv, kind, train


def run_case(cid, size, cv, kind, train):
    try:
        index_list, cv_index_list = CUT(size, train, cv)
    except Exception as e:  # reference itself cannot execute this config
        return {'id': cid, 'size': size, 'cv': cv, 'kind': kind, 'train': train,
                'ref_error': '%s: %s' % (type(e).__name__, e)}
    tr, te = index_list['train'], index_list['test']
    ts = int(tr.shape[-1]) if tr.ndim else 0
    assert list(tr) == list(range(ts)), 'train indices are not an arange'
    assert list(te) == list(range(ts, size)), 'test indices are not the tail arange'
    folds = []
    for i in range(cv):
        folds.append({
            'test': sorted(int(x) for x in np.ravel(cv_index_list[i]['test'])),
            'train': sorted(int(x) for x in np.ravel(cv_index_list[i]['train'])),
        })
    return {'id': cid, 'size': size, 'cv': cv, 'kind': kind, 'train': train,
            'train_size': ts, 'folds': folds}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = random.Random(seed)
    out = os.path.join(os.path.dirname(__file__), '..',
                       'src/test/resources/refdiff/cases.jsonl.gz')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    n_big = max(1, n // 50)  # a few large cases catch IEEE linspace edges
    errors = 0
    with gzip.open(out, 'wt') as f:
        for cid in range(n):
            size, cv, kind, train = gen_case(rng, big=cid < n_big)
            rec = run_case(cid, size, cv, kind, train)
            errors += 1 if 'ref_error' in rec else 0
            f.write(json.dumps(rec, separators=(',', ':')) + '\n')
    print('wrote %d cases (%d ref_error) to %s' % (n, errors, out))


if __name__ == '__main__':
    main()
