"""Engine tuning parameters — the TPU analog of the reference's params.h.

The reference derives its blocking constants from x86 cache sizes
(L2 256 KiB block sort, L3 20 MiB multiway-merge FIFO buffer — reference:
src/params.h:17-72, src/avxsort/avxsort.c:16-18, src/avxsort/avxsort_multiway.c:32-34).
On TPU the corresponding memory levels are VMEM (~16-128 MiB on-chip vector
memory) and HBM; constants here are expressed in tuples of 8 bytes
(two int32 columns).
"""

from __future__ import annotations

import os

# --- radix partitioning ----------------------------------------------------
# Reference: NRADIXBITS_DEFAULT 7 -> PARTFANOUT_DEFAULT 128 (params.h:17-24).
NRADIXBITS_DEFAULT = 7
PARTFANOUT_DEFAULT = 1 << NRADIXBITS_DEFAULT

# --- sort blocking ----------------------------------------------------------
# Tuples sorted per in-VMEM block by the block-sort kernel.  The reference
# uses L2/2 = 16K tuples (avxsort.c:16-18); a VMEM-resident block on TPU can
# be far larger, but the XLA row-sort sweet spot is a few K lanes per row.
BLOCKSIZE_DEFAULT = 16384

# Lane width of the VPU; all Pallas tiles use a 128-wide minor dimension.
LANES = 128
SUBLANES_I32 = 8  # min sublane count for int32 tiles

# --- multiway merge ---------------------------------------------------------
# VMEM budget for the multiway-merge FIFO scratch (analog of
# MWAY_MERGE_BUFFER_SIZE_DEFAULT = L3, params.h:57-63).
VMEM_BYTES = int(os.environ.get("SMJ_VMEM_BYTES", 64 * 1024 * 1024))
MWAY_BUFFER_TUPLES_DEFAULT = VMEM_BYTES // 8 // 4  # quarter of VMEM in tuples

# Slack multiplier for padded variable-size partitions (Zipf skew can make
# partitions exceed the uniform expectation; reference pads with
# ALIGN_NUMTUPLES/RELATION_PADDING, params.h:41-72).
PARTITION_SLACK = float(os.environ.get("SMJ_PARTITION_SLACK", 2.0))

# Alignment of partition starts in padded layouts (reference aligns to cache
# lines = 8 tuples, partition.c:35; we align to a full lane tile).
ALIGN_TUPLES = 1024


def align_tuples(n: int, align: int = ALIGN_TUPLES) -> int:
    return (n + align - 1) // align * align
