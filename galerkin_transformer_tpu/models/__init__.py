from .layers import (Identity, PositionalEncoding, FeedForward,
                     SimpleAttention, SpectralConv1d, SpectralConv2d,
                     BulkRegressor, get_activation)
from .conv import (Shortcut2d, Conv2dResBlock, Conv2dEncoder, Interp2dEncoder,
                   DeConv2dBlock, Interp2dUpsample, ConvTranspose2d)
from .graph import GraphConvolution, GraphAttention, EdgeEncoder, GCN, GAT
from .encoder import (SimpleTransformerEncoderLayer,
                      GalerkinTransformerDecoderLayer,
                      VanillaTransformerEncoderLayer)
from .regressor import PointwiseRegressor, SpectralRegressor
from .scaler import DownScaler, UpScaler
from .transformer import (SimpleTransformer, FourierTransformer2D,
                          FourierTransformer2DLite, inverse_transform)

__all__ = [
    "Identity", "PositionalEncoding", "FeedForward", "SimpleAttention",
    "SpectralConv1d", "SpectralConv2d", "BulkRegressor", "get_activation",
    "Shortcut2d", "Conv2dResBlock", "Conv2dEncoder", "Interp2dEncoder",
    "DeConv2dBlock", "Interp2dUpsample", "ConvTranspose2d",
    "GraphConvolution", "GraphAttention", "EdgeEncoder", "GCN", "GAT",
    "SimpleTransformerEncoderLayer", "GalerkinTransformerDecoderLayer",
    "VanillaTransformerEncoderLayer",
    "PointwiseRegressor", "SpectralRegressor", "DownScaler", "UpScaler",
    "SimpleTransformer", "FourierTransformer2D", "FourierTransformer2DLite",
    "inverse_transform",
]
