"""Shared numeric kernels (NumPy) used inside Pandas UDFs, plus Column
helper utilities. scipy is not a dependency — the needed signal-processing
primitives are implemented here from their textbook definitions."""
