from memo_tpu.view.plot import bin_conservation, plot_conservation, save_conservation_plot  # noqa: F401
