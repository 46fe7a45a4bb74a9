"""Worker for tests/dist/test_multiprocess.py::test_gather_fragments_mp.

Launched once per process. Each process builds the SAME full fragment
table from the numpy oracle, keeps only its round-robin row slice (a
stand-in for per-host window blocks from a physically sharded build),
then dist.merge.gather_fragments must reassemble the identical canonical
table on every process. Prints a checksum line the test asserts on.

Usage: python _mp_gather_worker.py <port> <pid> <nproc>
"""

import hashlib
import sys

port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402  (sitecustomize already imported it)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402

from repkiller_tpu.config import Config  # noqa: E402
from repkiller_tpu.dist.merge import gather_fragments, is_output_host  # noqa: E402
from repkiller_tpu.oracle import pipeline as orc  # noqa: E402
from repkiller_tpu.utils import synth  # noqa: E402

cfg = Config(k=12, strands="fr", hit_capacity=1 << 12, max_extend=128)
g = synth.plant(1500, [(90, 3, 0.03, 1)], seed=7)
full = orc.compare(g.codes, None, cfg)
full.pop("group", None)
want = orc.canonical_sort({k: v.copy() for k, v in full.items()})

mine = {k: v[pid::nproc] for k, v in full.items()}  # this host's block
got = gather_fragments(mine)

for k in want:
    assert np.array_equal(got[k], want[k]), (k, got[k], want[k])

h = hashlib.sha256()
for k in sorted(got):
    h.update(np.ascontiguousarray(got[k]).tobytes())
print(f"GATHER_OK {pid} {int(is_output_host())} {h.hexdigest()}", flush=True)
