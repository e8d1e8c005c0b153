from .graph import (  # noqa: F401
    GraphSpec,
    Node,
    build_graph_spec,
    graph_spec_from_edges,
    load_graph_spec,
    resolve_stage_graph,
    save_graph_spec,
)
from .layers import (  # noqa: F401
    ConvBNELU,
    ConvLayer,
    DecoderConvELU,
    DecoderStage,
    EfficientAttention,
    EncoderStage,
    GraphBlock,
    NodeBlock,
    SELayer,
)
from .encoder import RandomEncoder, resolve_encoder_graphs  # noqa: F401
from .decoder import DepthDecoder  # noqa: F401
from .model import RandomlyConnectedModel  # noqa: F401
from .discriminator import RandomDiscriminator  # noqa: F401
