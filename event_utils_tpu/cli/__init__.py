"""Command-line entry points.

- ``python -m event_utils_tpu.cli.visualize``        dataset-driven figures
- ``python -m event_utils_tpu.cli.visualize_events`` raw 3-D event rendering
- ``python -m event_utils_tpu.cli.visualize_voxel``  voxel-grid rendering
- ``python -m event_utils_tpu.cli.visualize_flow``   flow + event rendering
- ``python -m event_utils_tpu.cli.cmax_demo``        contrast-max objectives demo
- ``python -m event_utils_tpu.cli.augment_demo``     augmentation figure sweep
- ``python -m event_utils_tpu.cli.train_flow``       EV-FlowNet self-supervised
- ``python -m event_utils_tpu.cli.train_reconstruction`` E2VID training
- ``python -m event_utils_tpu.cli.infer_flow``       EV-FlowNet inference
- ``python -m event_utils_tpu.cli.reconstruct``      E2VID inference
- ``python -m event_utils_tpu.cli.simulate``         ESIM ground-truth data
- ``python -m event_utils_tpu.cli.eval_cmax``        cmax flow accuracy vs GT
- ``python -m event_utils_tpu.data_formats.rosbag_to_h5``       bag -> H5
- ``python -m event_utils_tpu.data_formats.h5_to_memmap``       H5 -> memmap
- ``python -m event_utils_tpu.data_formats.memmap_to_h5``       memmap -> H5
- ``python -m event_utils_tpu.data_formats.add_hdf5_attribute`` attr editor
"""
