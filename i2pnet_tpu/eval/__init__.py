from i2pnet_tpu.eval.evaluator import Evaluator
from i2pnet_tpu.eval.analysis import recall_analysis, parse_prediction_file
from i2pnet_tpu.eval.visualize import render_projection, render_comparison
