"""Multi-chip (mesh) training & serving.  See rmi_tpu.parallel.mesh."""
