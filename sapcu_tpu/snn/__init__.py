from sapcu_tpu.snn.surrogate import soft_spike, surrogate_grad, hard_spike_ste, spike
from sapcu_tpu.snn.neuron import (
    NeuronState,
    lif_init,
    eif_init,
    init_state,
    detach_state,
    lif_step,
    eif_step,
    multi_step,
)

__all__ = [
    "soft_spike", "surrogate_grad", "hard_spike_ste", "spike",
    "NeuronState", "lif_init", "eif_init", "init_state", "detach_state",
    "lif_step", "eif_step", "multi_step",
]
