from simseg_tpu.data.corruption import process_caption
from simseg_tpu.data.datasets import (
    DATALOADER,
    ConcatDataset,
    CsvPairDataset,
    DataLoader,
    ImageFolderDataset,
    ParquetRetrievalDataset,
    SegDataset,
    build_seg_valid_loader,
    debias_batches,
    sequential_batches,
)
from simseg_tpu.data.tokenizer import (
    WordPieceTokenizer,
    build_tokenizer,
    make_test_vocab,
)
from simseg_tpu.data.transforms import (
    TRANSFORMS,
    build_transforms,
    denormalize_to_u8,
    normalize_images,
)

__all__ = [
    "process_caption",
    "DATALOADER",
    "ConcatDataset",
    "CsvPairDataset",
    "DataLoader",
    "ImageFolderDataset",
    "ParquetRetrievalDataset",
    "SegDataset",
    "build_seg_valid_loader",
    "debias_batches",
    "sequential_batches",
    "WordPieceTokenizer",
    "build_tokenizer",
    "make_test_vocab",
    "TRANSFORMS",
    "build_transforms",
    "denormalize_to_u8",
    "normalize_images",
]
