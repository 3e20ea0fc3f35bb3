"""parquet2_ray — a Ray-Data-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of jorgecarleitao/parquet2
(reference at /root/reference, cited by file:line throughout) on top of
ray.data.Dataset pipelines:

- ``codecs``     pure NumPy encode/decode kernels (bitpack, hybrid RLE,
                 delta-binary-packed, delta byte-array family, dictionary,
                 FSST, frame-of-reference) — the analog of the reference's
                 ``src/encoding/`` tree.
- ``functions``  column statistics, codec auto-selection, text analysis,
                 hashing/fingerprints, minhash/simhash sketches.
- ``sources``    deterministic synthetic token-table generation + readers.
- ``stages``     Ray Data map_batches / map_groups stage callables.
- ``pipelines``  end-to-end encode → shuffle → write → manifest and
                 decode/verify pipelines.
- ``state``      per-partition lineage ledger + resumable manifest.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (bench.py, tests/conftest.py, or the evaluation driver).
"""

__version__ = "0.1.0"

# Sandbox-VM workaround (no-op elsewhere, remove for real clusters if THP
# helps there): this VM lazily host-backs memory, and transparent-hugepage
# faults run ~270× slower than 4K faults (measured 7 MB/s vs 1.9 GB/s on a
# 100 MB alloc-touch-free loop).  NumPy madvises HUGEPAGE on every large
# array, so one env var decides whether the whole engine runs at memory
# speed or at fault speed.  Must be set before numpy's first import —
# importing parquet2_ray early enough achieves that in our own entry
# points; bench.py/tests set it before ray.init so workers inherit it.
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
# Same pathology, other allocators (empirically A/B-tested at 32 workers
# on the 80 MTok headline): glibc's DYNAMIC mmap threshold is the killer —
# after the first large free it serves big blocks from the brk heap, whose
# grow/trim churn keeps faulting never-host-backed pages (measured 23×
# dilation concentrated in the gather/sort phase).  Pinning the threshold
# at its 128 KiB floor keeps large buffers mmap'd and recycled through the
# guest's warm page cache, and arrow stays on jemalloc (explicit, so a
# caller's "system" override is still possible): 7.7 s → 2.5-3.1 s wall.
# Workers inherit these via ray.init.
_os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "jemalloc")
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "131072")
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "131072")
