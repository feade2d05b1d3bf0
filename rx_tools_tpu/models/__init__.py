from rx_tools_tpu.models.fmchain import FmConfig, FmState, fm_chain_step, plan_capture
from rx_tools_tpu.models.powerscan import PowerConfig, power_hop_step, sweep_step, new_sweep_accum
from rx_tools_tpu.models import power_plan  # noqa: F401
from rx_tools_tpu.models import channelizer  # noqa: F401

__all__ = [
    "FmConfig", "FmState", "fm_chain_step", "plan_capture",
    "PowerConfig", "power_hop_step", "sweep_step", "new_sweep_accum",
    "power_plan",
]
