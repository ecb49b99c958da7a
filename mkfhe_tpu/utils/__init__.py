from .metrics import Timer, gate_op_counts, noise_lwe, noise_mntru, roofline_report  # noqa: F401
