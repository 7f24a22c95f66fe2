def test_devices_are_cpu_mesh():
    import jax

    devs = jax.devices()
    assert all(d.platform == "cpu" for d in devs), devs
    assert len(devs) == 8, devs
