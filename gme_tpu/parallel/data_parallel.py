"""Data parallelism over frame pairs.

The reference processes pairs serially (reference results.py:41); here the
batched pipeline step shards its leading (pair) axis over the mesh "data"
axis.  Each pair is independent, so XLA partitions the whole program with no
cross-device traffic — the cheapest possible scaling dimension.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gme_tpu.config import GMEConfig
from gme_tpu.models.gme import gme_pipeline_step
from gme_tpu.parallel.mesh import DATA_AXIS


def make_sharded_pipeline(mesh: Mesh, cfg: GMEConfig):
    """Compile the batched pipeline with the pair axis sharded over "data".

    Returns a function (prev_batch, curr_batch) -> dict of batched outputs.
    Batch size must be a multiple of the data-axis size.
    """
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(
        jax.jit,
        in_shardings=(batch_sh, batch_sh),
        out_shardings=batch_sh,
    )
    def step(prev_batch: jnp.ndarray, curr_batch: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return jax.vmap(lambda p, c: gme_pipeline_step(p, c, cfg))(
            prev_batch, curr_batch
        )

    return step
