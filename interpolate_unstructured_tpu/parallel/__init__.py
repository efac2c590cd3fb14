from . import sharding
