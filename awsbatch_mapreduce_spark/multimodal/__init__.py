from awsbatch_mapreduce_spark.multimodal.binary import (
    decode_image_features,
    frame_sample,
    synthesize_binary_docs,
)

__all__ = ["synthesize_binary_docs", "decode_image_features", "frame_sample"]
