from i2pnet_tpu.utils.seeding import set_seed
from i2pnet_tpu.utils.timings import Timings
from i2pnet_tpu.utils.monitor import UniWriter
from i2pnet_tpu.utils.avgmeter import AverageMeter
