"""Material::Scatter semantics (material.h:210-268) — unit-level checks of
the branch-free reimplementation against hand-derived expectations."""

import jax
import jax.numpy as jnp
import numpy as np

from tracy_tpu.render import material as mtl
from tracy_tpu.scene.scene import SceneBuilder


def _params(albedo=(0.5, 0.5, 0.5), roughness=0.0, metalness=0.0, ior=1.0,
            emissive=(0, 0, 0), translucent=0.0, normal=(0, 1, 0), n=1):
    def arr(v, width=None):
        a = np.asarray(v, np.float32)
        if a.ndim == 0:
            return jnp.full((n,), float(a))
        return jnp.tile(jnp.asarray(a)[None, :], (n, 1))

    return mtl.SurfaceParams(
        basecolor=arr(albedo),
        roughness=arr(roughness),
        metalness=arr(metalness),
        ior=arr(ior),
        emissive=arr(emissive),
        translucent=arr(translucent),
        normal=arr(normal),
    )


def test_schlick():
    # r0 for glass interface (n=1.5): ((1-1.5)/(2.5))^2 = 0.04.
    np.testing.assert_allclose(float(mtl.schlick(1.0, 1.5)), 0.04, atol=1e-6)
    # Grazing -> 1.
    np.testing.assert_allclose(float(mtl.schlick(0.0, 1.5)), 1.0, atol=1e-6)


def test_random_on_unit_sphere_distribution():
    r1 = jnp.linspace(0.001, 0.999, 4096)
    r2 = (jnp.linspace(0, 1, 4096) * 7.77) % 1.0
    v = np.asarray(mtl.random_on_unit_sphere(r1, r2))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert abs(v.mean(axis=0)).max() < 0.05  # approx uniform


def test_mirror_metal_reflects():
    """roughness=0 metal: specular chance = 1, direction = exact reflect."""
    n = 8
    p = _params(albedo=(1.0, 0.71, 0.29), roughness=0.0, metalness=1.0, n=n)
    d = jnp.tile(jnp.asarray([[0.707107, -0.707107, 0.0]]), (n, 1))
    point = jnp.zeros((n, 3))
    res = mtl.scatter(d, point, p,
                      jnp.full(n, 0.3), jnp.full(n, 0.7), jnp.full(n, 0.99))
    # reflect((s,-s,0), (0,1,0)) = (s, s, 0)
    np.testing.assert_allclose(
        np.asarray(res.direction), [[0.707107, 0.707107, 0.0]] * n, atol=1e-5
    )
    # Specular attenuation = lerp(0.85, basecolor, metal=1) = basecolor.
    np.testing.assert_allclose(np.asarray(res.attenuation),
                               [[1.0, 0.71, 0.29]] * n, atol=1e-6)
    # Origin offset by kRayOffset along the scattered dir (material.h:265).
    np.testing.assert_allclose(
        np.asarray(res.origin), np.asarray(res.direction) * 1e-3, atol=1e-8
    )


def test_diffuse_attenuation_and_chance():
    """Pure diffuse (rough=1, metal=0): spec chance = 0.1; diffuse lanes get
    albedo, specular lanes get 0.85 grey."""
    n = 2
    p = _params(albedo=(0.2, 0.4, 0.6), roughness=1.0, metalness=0.0, n=n)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
    point = jnp.zeros((n, 3))
    # u_spec = 0.05 < 0.1 -> specular; 0.5 >= 0.1 -> diffuse.
    res = mtl.scatter(d, point, p,
                      jnp.asarray([0.5, 0.5]), jnp.asarray([0.25, 0.25]),
                      jnp.asarray([0.05, 0.5]))
    np.testing.assert_allclose(np.asarray(res.attenuation[0]), [0.85] * 3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.attenuation[1]), [0.2, 0.4, 0.6], atol=1e-6)
    # roughness=1 -> specular dir == diffuse dir (lerp(reflect, scattered, 1)).
    np.testing.assert_allclose(np.asarray(res.direction[0]),
                               np.asarray(res.direction[1]), atol=1e-6)


def test_translucent_refracts_outside():
    """Glass entry: eta = 1/ior, refracted direction bends toward normal."""
    n = 1
    p = _params(albedo=(1, 1, 1), roughness=0.0, ior=1.5, translucent=1.0, n=n)
    theta = np.radians(45.0)
    d = jnp.asarray([[np.sin(theta), -np.cos(theta), 0.0]], dtype=jnp.float32)
    point = jnp.zeros((n, 3))
    # u_spec = 0.999 -> beyond any schlick at 45 deg -> transmitted branch.
    res = mtl.scatter(d, point, p,
                      jnp.full(n, 0.3), jnp.full(n, 0.7), jnp.full(n, 0.999))
    out = np.asarray(res.direction[0])
    # Snell: sin_t = sin(45)/1.5.
    np.testing.assert_allclose(out[0], np.sin(theta) / 1.5, atol=1e-5)
    assert out[1] < 0  # still going down (into the surface)


def test_translucent_tir_reflects():
    """Inside glass beyond the critical angle: our (documented) divergence
    from the reference's NaN — TIR lanes take the specular branch."""
    n = 1
    p = _params(albedo=(1, 1, 1), roughness=0.0, ior=1.5, translucent=1.0, n=n)
    # Inside: VdotN > 0 means direction along the normal; critical angle for
    # 1.5 is ~41.8 deg from the normal; take 80 deg.
    theta = np.radians(80.0)
    d = jnp.asarray([[np.sin(theta), np.cos(theta), 0.0]], dtype=jnp.float32)
    point = jnp.zeros((n, 3))
    res = mtl.scatter(d, point, p,
                      jnp.full(n, 0.3), jnp.full(n, 0.7), jnp.full(n, 0.9999))
    out = np.asarray(res.direction[0])
    # Specular = reflect(d, n): y component flips.
    np.testing.assert_allclose(out, [np.sin(theta), -np.cos(theta), 0.0], atol=1e-4)


def test_material_table_lookup_matches_direct():
    b = SceneBuilder(8, 8)
    for i in range(5):
        b.add_material((0.1 * i, 0.2, 0.3), roughness=0.1 * i, metalness=0.05 * i,
                       ior=1.0 + 0.1 * i, emissive=float(i), translucency=0.0)
    scene = b.build()
    ids = jnp.asarray([0, 3, 5, 1, 2, 4], jnp.int32)
    albedo, rough, metal, ior, emis, transl, tex = mtl.material_table_lookup(
        scene.materials, ids
    )
    np.testing.assert_allclose(np.asarray(albedo), np.asarray(scene.materials.albedo)[np.asarray(ids)], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ior), np.asarray(scene.materials.ior)[np.asarray(ids)], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tex), np.asarray(scene.materials.tex_index)[np.asarray(ids)])
