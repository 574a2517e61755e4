"""EIDOLA-TPU: a TPU-native real-time global-illumination path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the EIDOLA
Vulkan renderer (reference: IwakuraRein/CIS-565-Final-VR-Raytracer):

- glTF scene loading with alias-table light sampling (ref src/scene.cpp)
- HDR environment maps with solid-angle alias maps (ref src/hdr_sampling.cpp)
- Preetham-style procedural sun & sky (ref shaders/sun_and_sky.glsl)
- metallic-roughness BSDF with VNDF GGX sampling (ref shaders/pbr_metallicworkflow.glsl)
- ReSTIR DI: RIS + temporal reservoir reuse (ref shaders/direct_stage.comp)
- quarter-resolution ReSTIR GI with MIS path tracing and tiled multi-bounce
  Russian roulette (ref shaders/indirect_stage.comp)
- edge-avoiding a-trous wavelet denoiser (ref shaders/denoise_*.comp)
- compose + tonemap/post (ref shaders/compose.comp, post.frag)

Architecture (TPU-first, NOT a translation):
- A frame is one jit-compiled pure function over a carried FrameState pytree
  (replacing the reference's descriptor-set ping-pong, renderer.cpp:157).
- Ray tracing is wavefront: flat ray streams traverse a stackless threaded
  BVH built at load time (replacing VK_KHR_ray_query hardware traversal,
  shaders/traceray_rq.glsl).
- Screen-space data are dense SoA HBM tensors; the compressed G-buffer layout
  (depth f32 / oct-normal u32 / material unorm4x8 / albedo24+hash8) is kept
  because the compression is a bandwidth feature (direct_stage.comp:37-45).
- Multi-chip scaling is pixel-space sharding via jax.sharding.Mesh + shard_map
  (see eidola_tpu.parallel).
"""

__version__ = "0.1.0"
