"""Multi-chip execution: mesh construction, sharded inference and training.

The reference has zero distributed code (SURVEY.md §2.5); this package is the
TPU-native scaling layer: ``jax.sharding`` + ``jit`` over a Mesh, with XLA
inserting ICI collectives. No NCCL/MPI analog exists or is needed.
"""

from .mesh import make_mesh
from .inference import (data_parallel_infer_fn, shard_batch,
                        spatial_infer_fn)
from .multihost import feed_sharded, initialize_multihost, make_global_mesh
from .pipeline import (microbatch, pipeline_apply, stack_stages,
                       unmicrobatch)
from .train import (TrainState, create_train_state, fsdp_pspecs,
                    make_train_step, shard_train_state)

__all__ = ["make_mesh", "data_parallel_infer_fn", "shard_batch",
           "spatial_infer_fn", "TrainState", "create_train_state",
           "make_train_step", "shard_train_state", "fsdp_pspecs",
           "initialize_multihost",
           "make_global_mesh", "feed_sharded", "pipeline_apply",
           "stack_stages", "microbatch", "unmicrobatch"]
