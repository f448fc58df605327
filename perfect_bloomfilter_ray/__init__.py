"""perfect_bloomfilter_ray — a Ray-Data-native distributed sketch library.

Built from scratch (NOT a port) with the query/data-processing capabilities of
the reference Rust crate ``WCM-CS/perfect_bloomfilter`` (see SURVEY.md), extended
into a mergeable-sketch library (cascading Bloom + HLL + count-min + t-digest +
KLL as associative/commutative UDAFs) over Common-Crawl-style Parquet web-page
tables, executed via ``ray.data.Dataset`` pipelines.

Layout:
  functions/  pure vectorized kernels (hashing, text, key encoding)
  state/      mergeable sketch objects (no Ray dependency)
  stages/     Ray Data stages (UDAF adapters, membership, dedup, ANN, checkpoint)
  sources/    synthetic corpus generator + parquet I/O helpers
  pipelines/  end-to-end pipelines and the driver-facing analytics queries

Library code NEVER calls ``ray.init``/``ray.shutdown`` — sessions are owned by
the caller (driver, bench.py, or the pytest fixture).
"""

from perfect_bloomfilter_ray.config import BloomConfig
from perfect_bloomfilter_ray.facade import PerfectBloomFilter
from perfect_bloomfilter_ray.state.bloom import BloomCascade
from perfect_bloomfilter_ray.state.hll import HyperLogLog
from perfect_bloomfilter_ray.state.cms import CountMinSketch
from perfect_bloomfilter_ray.state.countsketch import CountSketch
from perfect_bloomfilter_ray.state.kll import KLLSketch
from perfect_bloomfilter_ray.state.req import REQSketch
from perfect_bloomfilter_ray.state.ddsketch import DDSketch
from perfect_bloomfilter_ray.state.cuckoo import CuckooFilter
from perfect_bloomfilter_ray.state.tdigest import TDigest
from perfect_bloomfilter_ray.state.theta import ThetaSketch
from perfect_bloomfilter_ray.state.spacesaving import MisraGries

__all__ = [
    "BloomConfig",
    "PerfectBloomFilter",
    "BloomCascade",
    "HyperLogLog",
    "CountMinSketch",
    "CountSketch",
    "KLLSketch",
    "REQSketch",
    "DDSketch",
    "CuckooFilter",
    "TDigest",
    "ThetaSketch",
    "MisraGries",
]
