"""Multi-chip distribution (reference: the NUMA thread/shuffle layer,
src/util/cpu_mapping.c + numa_shuffle.c + the threadrelchunks exchange)."""
