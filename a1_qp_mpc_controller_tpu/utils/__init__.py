from a1_qp_mpc_controller_tpu.utils import bezier, filters, mathx

__all__ = ["bezier", "filters", "mathx"]
