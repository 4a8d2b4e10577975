"""humid_ray — a Ray-Data-native near-duplicate detection + clustering
engine for image+caption corpora, reimplementing the semantics of
jfjlaros/HUMID (UMI-based FastQ dedup) over web-scale training data.

Reference semantics (see SURVEY.md): signature "word" assembly with a
bit budget split across sources, exact-dup counting, Hamming-distance
neighbor graph, count-directed ("directional") or flood-fill
("maximum") clustering, representative emission, annotate + stats.

Architecture (NOT a port): ray.data.Dataset pipelines; zero-copy Arrow
map_batches kernels; actor pools for stateful stages; groupby shuffles
replace the in-memory trie; LSH banding with hot-bucket salting
replaces the trie walk; distributed connected components + per-
component replay replace recursive pointer chasing.
"""

from humid_ray.config import HumidConfig, bits_from_source  # noqa: F401
from humid_ray.pipelines.humid import HumidPipeline, PipelineResult  # noqa: F401

__version__ = "0.1.0"
