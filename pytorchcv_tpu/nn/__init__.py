"""TPU-native block vocabulary: the shared cells from which every model in
the zoo is composed (analog of reference ``pytorchcv/models/common/``)."""

from .activ import (PReLU, create_activation_layer, hsigmoid, hswish,
                    lambda_hsigmoid, lambda_hswish, lambda_leakyrelu,
                    lambda_prelu, lambda_relu, lambda_relu6, lambda_sigmoid,
                    lambda_swish, lambda_tanh, swish)
from .arch import (Concurrent, DualPathSequential, Hourglass,
                   MultiOutputSequential, ParallelConcurent,
                   ParametricSequential, Sequential, SequentialConcurrent,
                   SesquialteralHourglass, positional_layers)
from .att import SABlock, SAConvBlock, SEBlock, round_channels, saconv3x3_block
from .base import call_block, conv_kernel_init, dense_kernel_init, to_2tuple, to_pad2d
from .conv import (AsymConvBlock, ConvBlock, ConvBlock1d, ConvTranspose2d,
                   DeconvBlock, DwsConvBlock, asym_conv3x3_block, conv1x1,
                   conv1x1_block, conv3x3, conv3x3_block, conv5x5_block,
                   conv7x7_block, deconv3x3_block, depthwise_conv3x3,
                   dwconv3x3_block, dwconv5x5_block, dwconv_block,
                   dwsconv3x3_block, pre_conv1x1_block, pre_conv3x3_block,
                   PreConvBlock)
from .norm import (BatchNorm, GroupNorm, IBN, InstanceNorm,
                   create_normalization_layer, lambda_batchnorm1d,
                   lambda_batchnorm2d, lambda_groupnorm,
                   lambda_instancenorm2d)
from .ops import (BreakBlock, ChannelShuffle, ChannelShuffle2, DenseBlock,
                  DucBlock, HeatmapMaxDetBlock, Identity, InterpolationBlock,
                  NormActivation, SelectableDense, adaptive_avg_pool2d,
                  avg_pool2d, channel_shuffle, channel_shuffle2, flatten,
                  global_avg_pool2d, grid_sample, interpolate, max_pool2d,
                  max_pool2d_with_indices, max_unpool2d, pixel_shuffle)
