"""osm_renderer_tpu — a TPU-native OpenStreetMap raster tile rendering framework.

A from-scratch reimplementation of the capabilities of dfyz/osm-renderer
(reference: a pure-Rust CPU slippy-tile renderer), redesigned TPU-first:

* Host side (Python + C++): OSM XML/PBF import, binary geodata store,
  MapCSS parsing and style cascade, label placement, PNG encode, HTTP.
* Device side (JAX / XLA / Pallas): Web-Mercator projection, batched
  polygon-fill and anti-aliased stroke coverage kernels, paint-order
  alpha compositing — thousands of tiles per XLA dispatch, sharded over
  a `jax.sharding.Mesh` for multi-chip serving.

The renderer is pixel-compatible with the reference semantics
(see `osm_renderer_tpu.draw` and `native/oracle.cpp` for the CPU oracle).
"""

__version__ = "0.1.0"
