from ste_gan_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from ste_gan_tpu.parallel.expert_parallel import (  # noqa: F401
    create_expert_mesh,
    moe_state_shardings,
    shard_moe_state,
)
from ste_gan_tpu.parallel.pipeline_parallel import (  # noqa: F401
    create_stage_mesh,
    create_stage_mesh_2d,
    pipeline_apply,
    stack_stage_params,
)
from ste_gan_tpu.parallel.tensor_parallel import (  # noqa: F401
    create_mesh_2d,
    shard_batch_2d,
    shard_state,
    state_shardings,
)
