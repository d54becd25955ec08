/* shim: boost::movelib::unique_ptr/make_unique -> std (C++14) */
#pragma once
#include <memory>
#include "core.hpp"
namespace boost { namespace movelib {
using std::unique_ptr;
using std::make_unique;
} }
