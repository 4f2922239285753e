from .srs import Srs
from .scheme import KzgScheme, KzgCommitment, KzgOpening

__all__ = ["Srs", "KzgScheme", "KzgCommitment", "KzgOpening"]
