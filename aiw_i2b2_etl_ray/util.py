"""Shared execution helpers."""

from __future__ import annotations

#: runtime_env for every heavy map_batches stage: each Ray worker runs its
#: vectorized kernels (polars, BLAS) SINGLE-threaded.  Ray already runs one
#: task per CPU; letting every polars call also spawn a machine-wide thread
#: pool oversubscribes cores ~30x and was measured to slow the normalize
#: stage ~8x.  Parallelism belongs to the scheduler, not the kernel.
WORKER_ENV = {
    "env_vars": {
        "POLARS_MAX_THREADS": "1",
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
    }
}
