from . import h5, schema, synthetic
