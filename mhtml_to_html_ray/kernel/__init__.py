"""Pure-Python per-document kernel (no Ray imports).

Everything here runs inside one `map_batches` task per page row; the public
entry points are :func:`mhtml_to_html_ray.kernel.mime.parse` and
:func:`mhtml_to_html_ray.kernel.convert.convert`.
"""
