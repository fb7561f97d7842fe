from iniz_exporters_spark.multimodal.binary import (  # noqa: F401
    binary_metadata,
    decode_images,
    extract_frames,
)
