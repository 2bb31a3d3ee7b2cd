from i2pnet_tpu.nn.layers import PointwiseConv, PointwiseMLP, RGBEncoder
from i2pnet_tpu.nn.pointnet import PointNetSetAbstraction
from i2pnet_tpu.nn.costvolume import CostVolume
from i2pnet_tpu.nn.upconv import SetUpconv
from i2pnet_tpu.nn.heads import FlowPredictor, PoseHead, ProjectMask, delay_weight
from i2pnet_tpu.nn.resnet import ResNetEncoder, BasicBlock
