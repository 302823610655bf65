from elasticdiffusion_tpu.sched.ddim import DDIMScheduler, DDIMState  # noqa: F401
from elasticdiffusion_tpu.sched.weight_schedulers import (  # noqa: F401
    CosineScheduler,
    LinearScheduler,
    ConstScheduler,
)
