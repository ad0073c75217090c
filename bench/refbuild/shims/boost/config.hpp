// empty boost/config.hpp stand-in (the reference includes it for
// compiler workarounds that g++ here doesn't need)
#ifndef GAM_SHIM_BOOST_CONFIG_HPP
#define GAM_SHIM_BOOST_CONFIG_HPP
#endif
