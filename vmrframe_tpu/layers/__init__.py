from vmrframe_tpu.layers.basic import (
    Conv1D,
    WordEmbedding,
    CharacterEmbedding,
    Embedding,
    PositionalEmbedding,
    VisualProjection,
    DepthwiseSeparableConvBlock,
    FeatureEncoder,
)
from vmrframe_tpu.layers.attention import (
    MultiHeadAttentionBlock,
    DualAttentionBlock,
    DualMultiAttention,
    CQAttention,
    CQConcatenate,
    WeightedPool,
)
from vmrframe_tpu.layers.predictor import (
    TopSelfAttention,
    FeatureEncoderPredict,
    SeqPANPredictor,
)
