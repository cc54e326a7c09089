from interdiff_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    Inpaint,
    ModelMeanType,
    ModelVarType,
)
from interdiff_tpu.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from interdiff_tpu.diffusion.schedule import (
    get_named_beta_schedule,
    respace_betas,
    space_timesteps,
)
