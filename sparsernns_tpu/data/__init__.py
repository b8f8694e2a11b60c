from sparsernns_tpu.data.ndns import (IN_DIM, N_CLASSES, SAMPLE_RATE,
                                      SEQ_LENGTH, DNSAudioDataset,
                                      NDNSLoader, SyntheticNDNS,
                                      create_ndns_dataset)

__all__ = [
    "DNSAudioDataset", "SyntheticNDNS", "NDNSLoader", "create_ndns_dataset",
    "N_CLASSES", "SEQ_LENGTH", "IN_DIM", "SAMPLE_RATE",
]
