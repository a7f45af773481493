from popnet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from popnet_tpu.train.schedule import ReduceLROnPlateau  # noqa: F401
from popnet_tpu.train.steps import (  # noqa: F401
    make_popnet_train_step,
    make_rtpose_train_step,
    make_yolo_train_step,
)
