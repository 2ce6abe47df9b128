from .params import RenderSettings, StaticConfig
from .wavefront import render_step, trace_one_sample
