from univs_tpu.losses.hungarian import hungarian
