from univs_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from univs_tpu.parallel.train_state import TrainState, make_train_step, create_train_state
