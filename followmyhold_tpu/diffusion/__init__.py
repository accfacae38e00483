from followmyhold_tpu.diffusion.scheduler import (
    FlowMatchSchedule,
    make_schedule,
    scale_noise,
    step,
    step_final,
    step_no_update,
)

__all__ = [
    "FlowMatchSchedule",
    "make_schedule",
    "scale_noise",
    "step",
    "step_final",
    "step_no_update",
]
