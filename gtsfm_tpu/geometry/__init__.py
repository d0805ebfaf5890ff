from gtsfm_tpu.geometry.se3 import SE3
from gtsfm_tpu.geometry.sim3 import Sim3
from gtsfm_tpu.geometry.calibration import Cal3Bundler, Cal3_S2, Cal3DS2, Cal3Fisheye
from gtsfm_tpu.geometry.cameras import PinholeCamera

__all__ = [
    "SE3",
    "Sim3",
    "Cal3Bundler",
    "Cal3_S2",
    "Cal3DS2",
    "Cal3Fisheye",
    "PinholeCamera",
]
