from rware_tpu.utils.spaces import MultiAgentActionSpace, MultiAgentObservationSpace

__all__ = ["MultiAgentActionSpace", "MultiAgentObservationSpace"]
