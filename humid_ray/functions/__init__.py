from humid_ray.functions.text import (  # noqa: F401
    extract_last_field,
    extract_umi,
    make_string_size,
    tokenize_batch,
    valid_umi,
)
from humid_ray.functions.simhash import simhash_batch  # noqa: F401
from humid_ray.functions.minhash import minhash_batch, minhash_band_keys  # noqa: F401
from humid_ray.functions.phash import phash_image, phash_batch  # noqa: F401
from humid_ray.functions.signature import compose_signatures, umi_hex_to_bits  # noqa: F401
