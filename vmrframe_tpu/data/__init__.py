from vmrframe_tpu.data.datasets import load_dataset, generate_dataset, process_data
from vmrframe_tpu.data.features import VideoFeatureStore, SyntheticFeatureStore
from vmrframe_tpu.data.batcher import Batcher, BatchPrefetcher
