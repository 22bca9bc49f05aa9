"""Diffusion schedules and samplers (DDPM / DDIM, classifier-free guidance)."""

from stablediffusion_pytorch_tpu.schedulers.linear import (
    LinearNoiseSchedule,
    make_linear_schedule,
    make_compvis_linear_schedule,
    add_noise,
    sample_prev_timestep,
)
from stablediffusion_pytorch_tpu.schedulers.samplers import (
    ddpm_sample,
    ddim_sample,
    ddim_timesteps,
    dpm_solver_sample,
    cfg_blend,
)
