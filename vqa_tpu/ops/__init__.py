# The fused co-attention kernel was RETIRED in r5 per the PARITY.md M8
# criterion (neither the 10x S.L workload nor an int8 co-attention path
# materialized; co-attention measured at ~2% of the step in the r5 device
# profile while XLA's fusion beats the kernel at the production shape).
# Code + tests preserved as the blockwise/long-context template in
# tools/retired/coattention_kernel.py.
__all__: list = []
