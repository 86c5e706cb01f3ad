from sparkdiff.multimodal.binaryops import (  # noqa: F401
    ASSET_SCHEMA,
    decode_assets,
    extract_features,
    frame_sample,
    synthesize_assets,
)
