"""Import-time stub for plotnine (not installed in this image), so the
reference's plot_conservation.py can be loaded as an oracle and its
*data-preparation* function (preprocess_data) executed for real. Plot
construction through these names produces inert objects — only the pandas
math is exercised."""


class _Anything:
    def __call__(self, *args, **kwargs):
        return self

    def __add__(self, other):
        return self

    def __radd__(self, other):
        return self

    def __getattr__(self, name):
        return self


ggplot = _Anything()
aes = _Anything()
theme = _Anything()
themes = _Anything()
element_blank = _Anything()
element_line = _Anything()
element_text = _Anything()
geom_bar = _Anything()
ggtitle = _Anything()
xlab = _Anything()
ylab = _Anything()
scale_y_continuous = _Anything()
scale_fill_gradient = _Anything()
