from i2pnet_tpu.models.i2pnet import I2PNet, set_id_grid, change_intrinsic
from i2pnet_tpu.models.i2pnet_proj import I2PNetProj
