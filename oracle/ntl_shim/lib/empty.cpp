extern "C" { int _ntl_shim_anchor; }
