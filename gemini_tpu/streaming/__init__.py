from .host import HostVector
from .sumcheck import SpaceProver, ElasticProver
from .kzg import CommitterKeyStream
