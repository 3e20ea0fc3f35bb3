"""Pure NumPy/Arrow codec kernels — the analog of the reference's
``src/encoding/`` tree (see SURVEY.md §2.1 for the operator map)."""

from . import (  # noqa: F401
    bitpack,
    byte_array,
    delta,
    dictionary,
    for_pack,
    fsst,
    hybrid_rle,
    plain,
    uleb,
)
from .column import (  # noqa: F401
    BINARY_CODECS,
    NUMERIC_CODECS,
    EncodedColumn,
    codecs_for_type,
    decode_array,
    encode_array,
)
