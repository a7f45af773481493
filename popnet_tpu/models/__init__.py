from popnet_tpu.models.rtpose_light3d import RTPoseLight3D  # noqa: F401
from popnet_tpu.models.rtpose_light import RTPoseLight  # noqa: F401
from popnet_tpu.models.rtpose_align3d import RTPoseAlign3D  # noqa: F401
from popnet_tpu.models.yolo_posenet import YoloPoseNet  # noqa: F401
from popnet_tpu.models.popnet import PopNet, PopNetRGB  # noqa: F401
from popnet_tpu.models.rtpose_vgg import RTPoseVGG  # noqa: F401
from popnet_tpu.models.a2j import A2J  # noqa: F401
